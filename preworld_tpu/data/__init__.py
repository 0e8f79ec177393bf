from .synthetic import synthetic_batch, tiny_config

__all__ = ["synthetic_batch", "tiny_config"]
