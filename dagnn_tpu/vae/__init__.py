from dagnn_tpu.vae.dvae import (
    DVAEConfig,
    dvae_decoder_init,
    dvae_base_init,
    dvae_teacher_loss,
    dvae_encode_sequential,
    dvae_decode,
    reparameterize,
    kld,
)
from dagnn_tpu.vae.dagnn_vae import (
    DAGNNVAEConfig,
    dagnn_vae_init,
    dagnn_vae_encode,
    dagnn_vae_loss,
    dagnn_vae_decode,
)

__all__ = [
    "DVAEConfig",
    "dvae_decoder_init",
    "dvae_base_init",
    "dvae_teacher_loss",
    "dvae_encode_sequential",
    "dvae_decode",
    "reparameterize",
    "kld",
    "DAGNNVAEConfig",
    "dagnn_vae_init",
    "dagnn_vae_encode",
    "dagnn_vae_loss",
    "dagnn_vae_decode",
]
