from misonet_tpu.beamforming.mvdr import (
    mvdr_beamform,
    spatial_covariance,
    principal_eigenvector,
    phase_correct,
    mvdr_weights,
)
from misonet_tpu.beamforming.scm import (
    streaming_scm_update,
    chunked_scm,
)
