"""TPU-native video frame interpolation framework.

A from-scratch JAX / XLA / Pallas / pjit re-design of the capabilities of the
Euiyeon-Kim/VideoFrameInterpolation PyTorch research stack: 2-frame ->
intermediate-frame interpolation trained on Vimeo90K triplets with pseudo-GT
flow distillation.

Layout conventions (TPU-first, not a port):
  * Images and feature maps are NHWC (channel-last) so that the channel axis
    maps onto TPU lanes and convolutions lower onto the MXU without transposes.
    (The PyTorch reference is NCHW throughout.)
  * Optical flow is stored as ``(..., 2)`` with components ``(fx, fy)`` in
    *pixel* units, matching the reference's channel order
    (``modules/warp.py:12`` uses channel 0 for x / width displacement).
  * ``t`` (the interpolation instant) is shaped ``(B, 1, 1, 1)``.
  * Parameters are float32; compute dtype is configurable (bfloat16 training,
    float32 evaluation for PSNR parity).
"""

__version__ = "0.1.0"
