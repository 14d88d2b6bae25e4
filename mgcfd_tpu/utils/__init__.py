from .checkpoint import save_checkpoint, load_checkpoint, latest_checkpoint

__all__ = ["save_checkpoint", "load_checkpoint", "latest_checkpoint"]
