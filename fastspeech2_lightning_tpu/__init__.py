"""fastspeech2_lightning_tpu — a TPU-native FastSpeech2 text-to-spec framework.

A brand-new JAX/XLA/Pallas implementation with the capabilities of
EveryVoiceTTS/FastSpeech2_lightning (see SURVEY.md): non-autoregressive
text-to-mel prediction with Conformer encoder/decoder, duration/pitch/energy
variance adaptors, learned text-to-mel alignment (conv attention + on-device
monotonic alignment search + CTC/binarization losses), optional PostNet, GST
style tokens, multi-speaker / multilingual conditioning, a full preprocessing
pipeline, and a preprocess/train/synthesize/benchmark CLI.

Design stance (TPU-first, not a port):
 - pure functional jitted train/eval/synthesis steps over flax params
 - static length-bucketed shapes with masks everywhere
 - monotonic alignment search as a `lax.scan` on device (the reference does a
   CPU numba round-trip every step, fs2/variance_adaptor.py:160-181)
 - data-parallel via `jax.sharding.Mesh(("data","model"))` + NamedSharding
 - orbax checkpoints with model_info name/version + migration hooks
"""

# Package version (the reference is 0.5.0, fs2/_version.py:1).
__version__ = "0.1.0"

# Model checkpoint format version (parity with fs2/model.py:39).
MODEL_VERSION = "1.2"

# Config schema version (parity with fs2/config/__init__.py:28).
CONFIG_VERSION = "1.1"
