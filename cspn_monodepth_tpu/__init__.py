"""cspn_monodepth_tpu — a TPU-native dense-depth engine.

A from-scratch JAX/XLA/Pallas/pjit framework with the capabilities of the
reference `dontLoveBugs/CSPN_monodepth` PyTorch codebase (see SURVEY.md):

* Monocular depth estimation (RGB -> dense depth) and depth completion
  (RGB + sparse depth samples -> dense depth) on NYU-Depth-v2 and KITTI.
* ResNet-50 UNet encoder-decoder predicting an initial "blur" depth map and an
  8-neighbor affinity map (SURVEY.md section 4.3).
* CSPN iterative spatial propagation refinement (Cheng et al., ECCV 2018 /
  TPAMI 2019) with optional per-iteration sparse anchor replacement
  (SURVEY.md section 4.1-4.2), implemented both as a pure-jnp lax.scan
  reference and as a fused multi-iteration Pallas TPU kernel.
* Data/spatial parallelism over a `jax.sharding.Mesh` with shard_map halo
  exchange for the propagation stencil (SURVEY.md section 2.2 N1/N2).
"""

__version__ = "0.1.0"
