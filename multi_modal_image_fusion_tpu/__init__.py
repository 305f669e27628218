"""multi_modal_image_fusion_tpu — a TPU-native JAX/XLA/Pallas framework for
unsupervised multi-modal image fusion.

Re-designed from scratch for TPU (NHWC layout, functional transforms, pjit/
shard_map data parallelism, Pallas kernels for windowed hot ops) with the same
capabilities as the PyTorch reference `chenzpstar/Multi-Modal-Image-Fusion`:

- 16-model zoo (reference: core/model.py) ......... `.models`
- block library (reference: core/block.py) ........ `.ops.blocks`
- 8 fusion strategies (reference: core/fusion.py) . `.ops.fusion`
- SSIM/pixel/grad/tv losses (core/loss.py) ........ `.ops.losses`
- 17 IQA metrics (core/metric.py) ................. `.ops.metrics`
- data pipeline (data/*.py) ....................... `.data`
- distributed training (NCCL DDP -> pjit/psum) .... `.parallel`, `.train`
- CLI entry points (train/test/eval.py) ........... `.cli`
"""

__version__ = "0.1.0"
