from dvae_tpu.data.text import (get_sentences_labels, preprocess_sentences,
                                reverse_sentences)
from dvae_tpu.data.labels import LabelCodec, fit_label_codecs, encode_labels
from dvae_tpu.data.vocab import build_vocab, save_vocab, load_vocab
from dvae_tpu.data.dataset import DenoisingTextDataset
from dvae_tpu.data.sampler import RatioBatchSampler, ShuffleBatchSampler
from dvae_tpu.data.pipeline import BatchPipeline, Batch

__all__ = [
    "get_sentences_labels", "preprocess_sentences", "reverse_sentences",
    "LabelCodec", "fit_label_codecs", "encode_labels",
    "build_vocab", "save_vocab", "load_vocab",
    "DenoisingTextDataset", "RatioBatchSampler", "ShuffleBatchSampler",
    "BatchPipeline", "Batch",
]
