from .flash_attention import (flash_attention, flash_attention_packed,
                              pack_qkv_weights)

__all__ = ["flash_attention", "flash_attention_packed", "pack_qkv_weights"]
