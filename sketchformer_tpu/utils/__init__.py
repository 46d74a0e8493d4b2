from sketchformer_tpu.utils.hparams import HParams
from sketchformer_tpu.utils.registry import Registry
