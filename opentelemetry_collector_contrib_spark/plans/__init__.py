from .compiler import PipelineConfig, StageConfig, compile_pipeline  # noqa: F401
