from .streams import conv_channel_shardings, make_stream_mesh  # noqa: F401
