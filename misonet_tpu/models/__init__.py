from misonet_tpu.models.miso import (
    MISONet,
    make_miso1,
    make_miso2,
    make_miso3,
    enhance_input,
)
