from pemp_tpu.tta.multi_scale import TTAPipeline

__all__ = ["TTAPipeline"]
