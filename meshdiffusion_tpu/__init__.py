"""MeshDiffusion-TPU: a TPU-native (JAX/XLA/Pallas) mesh-diffusion framework.

A from-scratch rebuild of the capabilities of lzzcd001/MeshDiffusion
(score-based generative 3D mesh modeling over DMTet grids), designed
TPU-first: channels-last 3D U-Nets compiled onto the MXU, the full
1000-step DDPM ancestral sampler as a single jitted lax.scan, marching
tetrahedra as fixed-shape gather/scatter over a static tet-grid edge
table, and data/spatial sharding over a jax.sharding.Mesh.
"""

__version__ = "0.1.0"
