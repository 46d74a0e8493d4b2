"""Model registry (reference: models/__init__.py get_model_by_name)."""

from sketchformer_tpu.utils.registry import Registry

models: Registry = Registry("model")


def get_model_by_name(name: str):
    return models.get(name)
