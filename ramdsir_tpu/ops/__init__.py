from ramdsir_tpu.ops.losses import (  # noqa: F401
    bce_loss,
    cross_entropy_loss,
    dice_loss,
    dice_loss_multi,
    kd_loss,
    mse_loss,
)
from ramdsir_tpu.ops.ram import (  # noqa: F401
    amplitude_spectrum,
    low_freq_band_mask,
    ram_mixup,
    sample_ram_ratios,
)
