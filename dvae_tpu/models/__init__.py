from dvae_tpu.models.vae import (LatentParams, init_vae_params, encode,
                                 compute_latent_params, compute_hidden,
                                 concat_z, decode_teacher_forced, sample,
                                 forward, discriminator_logits,
                                 adversary_logits, predict_from_logits)
from dvae_tpu.models.club import (club_mi_estimate, club_loglikeli,
                                  init_club_params)

__all__ = [
    "LatentParams", "init_vae_params", "encode", "compute_latent_params",
    "compute_hidden", "concat_z", "decode_teacher_forced", "sample",
    "forward", "discriminator_logits", "adversary_logits",
    "predict_from_logits", "club_mi_estimate", "club_loglikeli",
    "init_club_params",
]
