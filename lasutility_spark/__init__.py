"""lasutility_spark — a PySpark-native spatial analytics engine.

A from-scratch re-expression of the query/data-processing capabilities of
Kuoste/LasUtility (reference: /root/reference, C#, MIT) as an idiomatic
Spark DataFrame engine:

- ``gridlib``   — pure numpy semantic core (grid math, tile codec, scanline,
  Delaunay TIN, raster codecs).  No Spark imports; shippable via
  ``spark-submit --py-files``.
- ``engine``    — Spark stages: tiling/partitioning, voxel aggregates,
  per-tile TIN rasterization kernels, vector→raster PIP, checkpoints.
- ``pipelines`` — large-scale training-data ops (dedup, similarity search,
  text analysis, multimodal plumbing) over document/embedding tables.
"""

__version__ = "0.1.0"
