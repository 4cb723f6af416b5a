"""espflix_tpu — a TPU-native batched media decode & synthesis framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of rossumur/espflix
(reference mounted at /root/reference): MPEG-TS demux, MPEG-1 video decode
(I/P frames, half-pel motion compensation), SBC subband audio decode, A/V
sync, NTSC/PAL composite-signal synthesis, a second-order delta-sigma audio
modulator, and HTTP-range streaming with seek and trick play.

Where the reference decodes ONE stream on a 240 MHz ESP32
(`/root/reference/src/player.cpp`), this framework decodes thousands of
streams as batch lanes on a TPU slice:

  * the VLC/macroblock bitstream parser is a vectorized per-lane token
    scanner (`espflix_tpu.ops.vlc_scan`),
  * dequant + 8x8 IDCT and half-pel motion compensation are dense batched
    device kernels over contiguous HBM-resident YUV planes
    (`espflix_tpu.ops.idct`, `espflix_tpu.ops.mocomp`),
  * SBC subband synthesis is batched matmuls (`espflix_tpu.ops.sbc_ops`),
  * the composite scanline synthesizer and the delta-sigma modulator are
    streaming scan kernels (`espflix_tpu.ops.composite`,
    `espflix_tpu.ops.delta_sigma`).

All numeric paths are bit-exact in YUV/PCM against the C++ oracle in
`/root/repo/oracle`, which re-implements the reference decoder's exact
integer semantics from scratch.
"""

__version__ = "0.1.0"
