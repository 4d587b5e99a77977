"""Full-model assembly: the six experts + head as ONE flax module / ONE XLA
graph per step.

Baseline wiring follows train.py:242-251 (stack order u_doc, i_doc, img_vec,
ui_vec, xui, xti); the HoME wiring follows train_HoME.py:344-357 (BN wrappers
on every expert vector before stacking, HOME head, plus raw vectors exposed
for the contrastive losses).

Unlike the reference — which runs seven separately-DDP-wrapped torch modules
per step — everything here jits together, so XLA fuses the expert stack, the
gates and the towers, and the single backward pass needs one gradient psum
over the mesh instead of seven DDP allreduce buckets.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..config import ModelConfig
from .cross import EnhancedCrossFuse, RobustTextCrossExpert
from .heads import TwoTaskMMoE
from .home import HomeExpertWrapper, HomeMMoEHead
from .image_expert import (ImageExpertWithProjection, ItemImageExpert,
                           normalize_patches)
from .layers import Array
from .text_expert import DualTextExpert, TextExpert


class ModelOutputs(NamedTuple):
    logit_good: Array
    logit_best: Array
    aux: Dict[str, Array]        # raw vectors for contrastive losses / debug


def _dtype(name: str):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
            "float16": jnp.float16}[name]


class MMoERecModel(nn.Module):
    """batch dict -> (logit_good, logit_best, aux).

    Expected batch keys (all static shapes, built by data/packer.py +
    data/loader.py):
      user_tokens [Nu, L] int32      item_tokens [Ni, L] int32
      user_sent_chunk/user_sent_tok [B, S] int32 (item_ likewise)
      patches [B, 196, 768] uint8    has_image [B] int32
    """
    cfg: ModelConfig

    @nn.compact
    def __call__(self, batch: Dict[str, Array], *,
                 deterministic: bool = True,
                 bn_use_running_average: Optional[bool] = None
                 ) -> ModelOutputs:
        cfg = self.cfg
        home = cfg.variant == "home"
        dtype = _dtype(cfg.compute_dtype)
        pdtype = _dtype(cfg.param_dtype)
        if bn_use_running_average is None:
            bn_use_running_average = deterministic

        common = dict(dtype=dtype, param_dtype=pdtype,
                      use_flash=cfg.use_flash_attention)
        enc_common = dict(common, remat=cfg.remat,
                          remat_policy=cfg.remat_policy)

        if cfg.shared_text_base:
            # ONE encoder pass over [user; item] chunks: shared frozen base,
            # per-side LoRA (see DualTextExpert docstring for the exactness
            # argument vs the reference's two frozen-base copies).
            (u_sent, u_mask, u_doc), (i_sent, i_mask, i_doc) = \
                DualTextExpert(cfg.text, cfg.packer.fixed_sent_count,
                               dropout=cfg.dropout, final_norm=not home,
                               name="text_experts", **enc_common)(
                    batch["user_tokens"], batch["item_tokens"],
                    batch["user_sent_chunk"], batch["user_sent_tok"],
                    batch["item_sent_chunk"], batch["item_sent_tok"],
                    deterministic=deterministic)
        else:
            user_expert = TextExpert(cfg.text, cfg.packer.fixed_sent_count,
                                     dropout=cfg.dropout, final_norm=not home,
                                     name="user_expert", **enc_common)
            item_expert = TextExpert(cfg.text, cfg.packer.fixed_sent_count,
                                     dropout=cfg.dropout, final_norm=not home,
                                     name="item_expert", **enc_common)

            u_sent, u_mask, u_doc = user_expert(
                batch["user_tokens"], batch["user_sent_chunk"],
                batch["user_sent_tok"], deterministic=deterministic)
            i_sent, i_mask, i_doc = item_expert(
                batch["item_tokens"], batch["item_sent_chunk"],
                batch["item_sent_tok"], deterministic=deterministic)

        patches = normalize_patches(batch["patches"], batch["has_image"])
        projected_img = None
        if home:
            img_vec, projected_img = ImageExpertWithProjection(
                cfg.image, name="img_expert", **enc_common)(
                patches, deterministic=deterministic)
        else:
            img_vec = ItemImageExpert(cfg.image, dropout=cfg.dropout,
                                      name="img_expert", **enc_common)(
                patches, deterministic=deterministic)

        ui_vec = RobustTextCrossExpert(
            n_layers=cfg.cross_layers, n_heads=cfg.cross_heads,
            dropout=cfg.dropout, final_mlp=not home, pool_nan_guard=home,
            name="cross_ui", **common)(
            u_sent, u_mask, i_sent, i_mask, deterministic=deterministic)
        xui = EnhancedCrossFuse(depth=cfg.fuse_depth, n_heads=cfg.fuse_heads,
                                dropout=cfg.dropout, final_proj=not home,
                                dtype=dtype, param_dtype=pdtype,
                                name="concat_ui")(
            u_doc, img_vec, deterministic=deterministic)
        xti = EnhancedCrossFuse(depth=cfg.fuse_depth, n_heads=cfg.fuse_heads,
                                dropout=cfg.dropout, final_proj=not home,
                                dtype=dtype, param_dtype=pdtype,
                                name="concat_ti")(
            i_doc, img_vec, deterministic=deterministic)

        aux: Dict[str, Array] = {
            "u_doc": u_doc, "i_doc": i_doc, "img_vec": img_vec,
            "ui_vec": ui_vec, "xui": xui, "xti": xti,
        }

        if home:
            aux["projected_img"] = projected_img
            wrapped = []
            for name, vec in (("u_doc_wrapper", u_doc),
                              ("i_doc_wrapper", i_doc),
                              ("img_vec_wrapper", img_vec),
                              ("ui_vec_wrapper", ui_vec),
                              ("xui_wrapper", xui),
                              ("xti_wrapper", xti)):
                wrapped.append(HomeExpertWrapper(
                    dropout=cfg.dropout, bn_momentum=cfg.home_bn_momentum,
                    bn_eps=cfg.home_bn_eps, dtype=dtype, name=name)(
                    vec, deterministic=deterministic,
                    use_running_average=bn_use_running_average))
            expert_vecs = jnp.stack(wrapped, axis=1)
            logit_good, logit_best, balance = HomeMMoEHead(
                num_input_experts=cfg.n_experts,
                n_shared_experts=cfg.home_shared_experts,
                n_task_experts=cfg.home_task_experts,
                expert_hidden=cfg.home_expert_hidden,
                expert_dropout=cfg.home_expert_dropout,
                tower_hidden=cfg.home_tower_hidden,
                tower_dropout=cfg.home_tower_dropout,
                gate_type=cfg.gate_type, gate_topk=cfg.gate_topk,
                dtype=dtype, param_dtype=pdtype, name="head")(
                expert_vecs, deterministic=deterministic)
        else:
            expert_vecs = jnp.stack(
                [u_doc, i_doc, img_vec, ui_vec, xui, xti], axis=1)
            logit_good, logit_best, balance = TwoTaskMMoE(
                n_expert=cfg.n_experts, tower_hidden=cfg.tower_hidden,
                tower_dropout=cfg.tower_dropout,
                gate_type=cfg.gate_type, gate_topk=cfg.gate_topk,
                dtype=dtype, param_dtype=pdtype, name="head")(
                expert_vecs, deterministic=deterministic)

        aux["gate_balance"] = balance
        return ModelOutputs(logit_good.astype(jnp.float32),
                            logit_best.astype(jnp.float32), aux)
