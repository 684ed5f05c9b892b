from dagnn_tpu.train.losses import tok_loss, class_loss
from dagnn_tpu.train.optim import make_optimizer

__all__ = ["tok_loss", "class_loss", "make_optimizer"]
