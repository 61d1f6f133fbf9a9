from .streams import MultiStreamPipeline, make_stream_mesh  # noqa: F401
