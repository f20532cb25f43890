from datapump_spark.streaming.pipeline import Pipeline, PipelineResult

__all__ = ["Pipeline", "PipelineResult"]
