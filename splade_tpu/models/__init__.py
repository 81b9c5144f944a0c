from splade_tpu.models.modernbert import ModernBertConfig, ModernBertForMaskedLM
from splade_tpu.models.splade import SpladeEncoder, splade_pool_from_logits

__all__ = [
    "ModernBertConfig",
    "ModernBertForMaskedLM",
    "SpladeEncoder",
    "splade_pool_from_logits",
]
