from dvae_tpu.utils.misc import set_seed, tensor2text
from dvae_tpu.utils.bleu import bleu_score, compute_bleu
from dvae_tpu.utils.compile_cache import enable_compilation_cache
from dvae_tpu.utils.platform import apply_platform_override

__all__ = ["set_seed", "tensor2text", "bleu_score", "compute_bleu",
           "enable_compilation_cache", "apply_platform_override"]
