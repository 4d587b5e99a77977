"""Shared test helpers: tiny configs + synthetic packed batches + a loader
for executing the untrusted reference's own modules (deps auto-stubbed) so
golden parity tests compare against real reference behavior, not our reading
of it."""
import importlib.machinery
import importlib.util
import sys
import types

import numpy as np

from mmoe_multimodal_rec_tpu.config import Config, tiny_config
from mmoe_multimodal_rec_tpu.data.packer import TextPacker
from mmoe_multimodal_rec_tpu.data.sentence import split_sentences
from mmoe_multimodal_rec_tpu.data.synthetic import synthetic_raw_batch
from mmoe_multimodal_rec_tpu.data.wordpiece import HashTokenizer
from mmoe_multimodal_rec_tpu.data.loader import assemble_batch

__all__ = ["tiny_config", "tiny_tokenizer", "packed_batch", "stacked_batch",
           "load_reference_module", "HFTokenizerShim"]

REFERENCE_DIR = "/root/reference"


class _AnyModule(types.ModuleType):
    """Module stub that fabricates a class for any attribute access, so
    `from apache_beam.x import Y` and `beam.DoFn` both resolve."""

    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)
        val = type(name, (), {})
        setattr(self, name, val)
        return val


_STUBBABLE = ["apache_beam", "apache_beam.options",
              "apache_beam.options.pipeline_options", "apache_beam.io",
              "apache_beam.io.filesystem", "apache_beam.io.fileio",
              "webdataset", "google", "google.cloud",
              "google.cloud.storage", "emoji", "nltk", "nltk.tokenize",
              "httpx", "peft", "sklearn", "sklearn.metrics", "matplotlib",
              "matplotlib.pyplot"]


def load_reference_module(filename: str, modname: str = None):
    """Import `/root/reference/<filename>` with unavailable heavy deps
    replaced by attribute-fabricating stubs.  Installed packages (torch,
    transformers, numpy, ...) import for real.  `emoji.demojize` is stubbed
    to identity (the package is absent in this image; our textbuild gates on
    it the same way)."""
    import os
    modname = modname or "ref_" + filename.replace(".", "_")
    if modname in sys.modules:
        return sys.modules[modname]
    installed = {}
    for name in _STUBBABLE:
        if name in sys.modules:
            continue
        try:
            if importlib.util.find_spec(name) is not None:
                continue
        except (ImportError, ModuleNotFoundError, ValueError):
            pass
        mod = _AnyModule(name)
        mod.__path__ = []
        sys.modules[name] = mod
        installed[name] = mod
    if "emoji" in installed:
        installed["emoji"].demojize = \
            lambda s, delimiters=(" ", " "): s
    path = os.path.join(REFERENCE_DIR, filename)
    spec = importlib.util.spec_from_file_location(
        modname, path, submodule_search_locations=None)
    # extension-less files (infer_auc_HoME) need an explicit source loader
    if spec is None or spec.loader is None:
        loader = importlib.machinery.SourceFileLoader(modname, path)
        spec = importlib.util.spec_from_loader(modname, loader)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[modname] = mod
    spec.loader.exec_module(mod)
    return mod


class HFTokenizerShim:
    """Exactly the HF-tokenizer surface the reference's `preprocess_batch`
    touches (model.py:36,58-66,99-109), backed by one of our tokenizers
    (WordPieceTokenizer or HashTokenizer).  `vocab_size` excludes the added
    <SENT> token and `convert_tokens_to_ids` returns an id == vocab_size,
    matching `tokenizer.add_tokens(["<SENT>"])` (ref train.py:103) — which is
    what makes the reference's OOV clamp (model.py:101-109) rewrite every
    <SENT> marker to [PAD]."""

    def __init__(self, t):
        self._t = t
        self.cls_token_id = t.cls_id
        self.sep_token_id = t.sep_id
        self.pad_token_id = t.pad_id
        self.vocab_size = t.vocab_size

    def convert_tokens_to_ids(self, token):
        assert token == "<SENT>"
        return self._t.sent_id

    def encode(self, text, add_special_tokens=True, max_length=None,
               truncation=False):
        assert add_special_tokens is False and truncation is True
        return self._t.encode(text, max_length=max_length)


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


def tiny_cli_flags(variant: str = "baseline"):
    """The tiny-dims dotted-flag set matching tiny_config(), for tests
    that drive the real CLI (three copies of this list used to drift)."""
    flags = [
        "--train.batch_size=4", "--train.mesh.data_parallel=1",
        "--model.d=32", "--model.compute_dtype=float32",
        "--model.use_flash_attention=false",
        "--model.cross_heads=4", "--model.fuse_heads=4",
        "--model.tower_hidden=16",
        "--model.text.vocab_size=201", "--model.text.hidden_size=32",
        "--model.text.num_layers=2", "--model.text.num_heads=4",
        "--model.text.intermediate_size=64",
        "--model.text.max_position_embeddings=48",
        "--model.text.lora_rank=2",
        "--model.image.hidden_size=32", "--model.image.num_layers=2",
        "--model.image.num_heads=4", "--model.image.intermediate_size=64",
        "--model.packer.max_tok=24",
        "--model.packer.max_chunks_per_sample=2",
        "--model.packer.fixed_sent_count=6",
        "--data.allow_hash_tokenizer=true",
    ]
    if variant != "baseline":
        flags += [f"--model.variant={variant}",
                  "--model.home_tower_hidden=16",
                  "--model.home_expert_hidden=24"]
    return flags
