"""monorec_tpu: a TPU-native JAX framework for dense monocular reconstruction
in dynamic scenes (MonoRec-style plane-sweep cost volumes + mask/depth
decoders), built on jax/XLA/pallas/pjit.

Capability reference: Brummi/MonoRec (see SURVEY.md). This is a from-scratch
TPU-first design, not a port: pure functional forward passes, static shapes,
batch-sharded pjit training over a device mesh, and a fused Pallas kernel for
the plane-sweep cost volume.
"""

__version__ = "0.1.0"
