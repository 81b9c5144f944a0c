from splade_tpu.mining.teacher_scores import precompute_teacher_scores
from splade_tpu.mining.multi_negatives import mine_multi_negatives

__all__ = ["precompute_teacher_scores", "mine_multi_negatives"]
