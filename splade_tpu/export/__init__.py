from splade_tpu.export.hf_export import export_checkpoint_to_hf

__all__ = ["export_checkpoint_to_hf"]
