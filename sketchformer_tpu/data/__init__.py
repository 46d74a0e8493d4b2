from sketchformer_tpu.data import stroke3
from sketchformer_tpu.data.tokenizer import GridTokenizer, DictionaryTokenizer
from sketchformer_tpu.data.registry import dataloaders, get_dataloader_by_name
from sketchformer_tpu.data import tfrecord  # registers tfrecord_stroke3
