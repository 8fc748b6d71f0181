"""multimodal_ad_tpu — TPU-native JAX/XLA/Pallas framework for multimodal
Alzheimer's-disease classification on ADNI.

A ground-up rebuild of the capabilities of dongzj56/Multimodal_AD
(PyTorch/MONAI, single-GPU) as an idiomatic TPU stack:

- 3D volumetric CNNs (ResNet-10..200, 3D U-Nets, cross-modal transformer)
  in flax.linen with channels-last (NDHWC) layouts and a bf16 compute /
  fp32 state precision policy.
- SPMD data parallelism over a `jax.sharding.Mesh` (GSPMD): batch-sharded
  arrays + jit; gradient all-reduce rides ICI via XLA collectives.
- Pallas kernels for the hot non-matmul ops (AAL atlas ROI pooling as an
  MXU-friendly one-hot segment-sum).
- A host-side async input pipeline (threaded NIfTI decode + double-buffered
  device_put) so the TPU is never input-bound.
- A shared training/eval harness (stratified K-fold CV, 7-metric evaluation,
  CSV/TensorBoard logging, Orbax best/final checkpointing with resume) that
  the reference copy-pastes per experiment (reference train_ResNet3D.py:44-108).
"""

__version__ = "0.1.0"
