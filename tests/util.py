"""Shared test helpers: tiny configs + synthetic packed batches."""
import numpy as np

from mmoe_multimodal_rec_tpu.config import Config, tiny_config
from mmoe_multimodal_rec_tpu.data.packer import TextPacker
from mmoe_multimodal_rec_tpu.data.sentence import split_sentences
from mmoe_multimodal_rec_tpu.data.synthetic import synthetic_raw_batch
from mmoe_multimodal_rec_tpu.data.wordpiece import HashTokenizer
from mmoe_multimodal_rec_tpu.data.loader import assemble_batch

__all__ = ["tiny_config", "tiny_tokenizer", "packed_batch", "stacked_batch"]


def tiny_tokenizer(cfg: Config) -> HashTokenizer:
    return HashTokenizer(vocab_size=cfg.model.text.vocab_size - 1)


def packed_batch(cfg: Config, seed: int = 0, batch_size: int = None):
    rng = np.random.default_rng(seed)
    b = batch_size or cfg.train.batch_size
    samples = synthetic_raw_batch(rng, b)
    packer = TextPacker(tiny_tokenizer(cfg), cfg.model.packer,
                        splitter=split_sentences)
    return assemble_batch(samples, packer)


def stacked_batch(cfg: Config, seed: int = 0):
    from mmoe_multimodal_rec_tpu.train.loop import stack_micro_batches
    accum = cfg.train.optim.grad_accum
    micros = [packed_batch(cfg, seed=seed * 100 + i) for i in range(accum)]
    return stack_micro_batches(micros)
