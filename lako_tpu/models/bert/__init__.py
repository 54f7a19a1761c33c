from lako_tpu.models.bert.model import BertEncoder
from lako_tpu.models.bert.convert import params_from_torch_bert

__all__ = ["BertEncoder", "params_from_torch_bert"]
