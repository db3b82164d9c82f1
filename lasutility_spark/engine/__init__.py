"""Spark stages of the engine: tiling, voxel aggregates, TIN kernels,
vector->raster PIP, checkpoint-resumable stage tables."""
