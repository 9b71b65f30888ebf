from dvae_tpu.utils.misc import set_seed, tensor2text
from dvae_tpu.utils.bleu import bleu_score, compute_bleu
from dvae_tpu.utils.compile_cache import enable_compilation_cache

__all__ = ["set_seed", "tensor2text", "bleu_score", "compute_bleu",
           "enable_compilation_cache"]
