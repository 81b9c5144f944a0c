from splade_tpu.ops.splade_pool import (
    splade_pool_from_logits,
    splade_pool_streamed,
)

__all__ = ["splade_pool_from_logits", "splade_pool_streamed"]
