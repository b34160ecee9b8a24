"""Pipelines: initializers and optimizers (mirrors gaustudio/pipelines)."""
from gaustudio_tpu.pipelines import initializers, optimizers  # noqa: F401
