from lako_tpu.models.t5.model import T5, T5Encoder, T5Decoder, FiDT5
from lako_tpu.models.t5.convert import params_from_torch_t5

__all__ = ["T5", "T5Encoder", "T5Decoder", "FiDT5", "params_from_torch_t5"]
