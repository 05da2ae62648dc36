from pemp_tpu.utils.logger import Logger

__all__ = ["Logger"]
