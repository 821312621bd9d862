from .multistream import make_frame_step, make_multistream_step, make_stream_state

__all__ = ["make_frame_step", "make_multistream_step", "make_stream_state"]
