"""TPU kernel layer: MXU-friendly reformulations and Pallas kernels for the
hot ops (SURVEY.md §7.3). Start from XLA-native formulations; Pallas only
where profiling shows wins.
"""

from anytime3d_tpu.kernels.subpixel import (
    SubpixelDeconv3D,
    subpixel_deconv3d,
    convtranspose_kernel_to_subpixel,
)

__all__ = [
    "SubpixelDeconv3D",
    "subpixel_deconv3d",
    "convtranspose_kernel_to_subpixel",
]
