from misonet_tpu.inference.separate import (
    make_full_array_decode,
    align_slots,
)
from misonet_tpu.inference.cascade import (
    make_cascade,
    beamform_sources,
)
