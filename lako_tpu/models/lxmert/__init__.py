from lako_tpu.models.lxmert.model import (LxmertForQA, LxmertModel)
from lako_tpu.models.lxmert.convert import (
    load_lxmert_pretrained, lxmert_params_from_state_dict,
    lxmert_qa_params_from_state_dict)
from lako_tpu.models.lxmert.runner import LxmertVQARunner

__all__ = ["LxmertForQA", "LxmertModel", "LxmertVQARunner",
           "load_lxmert_pretrained", "lxmert_params_from_state_dict",
           "lxmert_qa_params_from_state_dict"]
