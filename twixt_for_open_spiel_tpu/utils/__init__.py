from twixt_for_open_spiel_tpu.utils import profiling, serialization

__all__ = ["profiling", "serialization"]
