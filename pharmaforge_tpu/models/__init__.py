from pharmaforge_tpu.models.schedules import (
    cosine_beta_schedule,
    clip_noise_schedule,
    polynomial_schedule,
    make_gamma_table,
)
from pharmaforge_tpu.models.gvp import GVP, GVPLayerNorm, gvp_dropout
from pharmaforge_tpu.models.dynamics import PharmRecDynamics
from pharmaforge_tpu.models.diffusion import PharmacophoreDiffusion, DiffusionConfig
from pharmaforge_tpu.models.size_dist import PharmSizeDistribution
