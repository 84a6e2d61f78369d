from vocal_remover_tpu.models.base_net import BaseNet
from vocal_remover_tpu.models.cascaded import CascadedNet, param_count
from vocal_remover_tpu.models import convert

__all__ = ["BaseNet", "CascadedNet", "param_count", "convert"]
