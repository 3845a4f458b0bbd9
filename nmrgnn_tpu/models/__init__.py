from .gnn import apply, apply_batched, count_params, init_params, trainable_mask

__all__ = ["apply", "apply_batched", "count_params", "init_params", "trainable_mask"]
