from ramdsir_tpu.models.unet import (  # noqa: F401
    ConvD,
    ConvU,
    ConvURec,
    Decoder,
    Discriminator,
    Encoder,
    RecDecoder,
    Unet2D,
    Unet2DDS,
    Unet2DMS,
    Unet2DMT,
    count_params,
)
from ramdsir_tpu.models.norm import (  # noqa: F401
    BatchNorm,
    DomainSpecificBatchNorm,
    Norm,
)
