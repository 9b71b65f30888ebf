from dvae_tpu.utils.misc import set_seed, tensor2text
from dvae_tpu.utils.bleu import bleu_score, compute_bleu

__all__ = ["set_seed", "tensor2text", "bleu_score", "compute_bleu"]
