"""imp_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for interpretable
multimodal cancer prototyping.

Re-designed from scratch with the capabilities of the reference PyTorch
framework ``medmm`` (helenypzhang/Interpretable-Multimodal-Prototyping):
whole-slide-image patch-feature bags + bulk RNA-seq across four TCGA-glioma
tasks (Survival, Grading, Classification, Subtyping), the UMEML/UMEML_GAN
prototype models, and the full baseline zoo — but idiomatic for TPU:

* pure-function flax models over fixed-shape, boolean-masked bags
  (replacing the reference's -10000 sentinel padding and per-slide
  Python loops, cf. reference ``medmm/data/data_manager.py:356-367``,
  ``medmm/modeling/models/umeml_gan.py:401-434``);
* a single donated-buffer ``jax.jit`` train step with multi-optimizer
  GAN updates (replacing backward-inside-forward,
  cf. reference ``umeml_gan.py:461-490``);
* ``jax.sharding.Mesh`` + NamedSharding data parallelism (replacing
  ``nn.DataParallel``, cf. reference ``medmm/engine/trainer.py:483-486``);
* Pallas kernels for the hot masked-attention ops.
"""

__version__ = "0.1.0"
