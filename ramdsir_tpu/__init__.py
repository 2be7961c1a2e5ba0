"""ramdsir_tpu — a TPU-native framework for domain-generalizable medical
image segmentation (RAM-DSIR capabilities, re-designed for JAX/XLA/Pallas).

Capabilities mirror the reference PyTorch research codebase
(zzzqzhou/RAM-DSIR): a shared U-Net encoder with a segmentation decoder and a
domain-specific image-restoration decoder, trained with Random Amplitude
Mixup (RAM) frequency-domain augmentation, KD/MSE consistency, and
leave-one-domain-out evaluation on Fundus and Prostate benchmarks.

Design departures from the reference (TPU-first, not a port):
  * RAM runs on-device as a batched rfft2 -> band-mix -> irfft2 op
    (optionally a fused Pallas band-mix kernel), instead of per-sample CPU
    numpy FFT inside DataLoader workers.
  * The whole train step (dual forward, losses, Adam update, poly LR) is a
    single jitted function; batch parallelism is expressed with
    `jax.sharding.Mesh` + sharding annotations so XLA inserts ICI
    collectives.
  * Data layout is NHWC (TPU-native); checkpoint import/export maps to the
    reference's NCHW torch state dicts for parity checking.
"""

__version__ = "0.1.0"
