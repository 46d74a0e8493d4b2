from sketchformer_tpu.models.registry import models, get_model_by_name
from sketchformer_tpu.models.sketchformer import Sketchformer, SketchformerConfig
