from .multistream import (make_frame_step, make_multistream_step,
                          make_scan_probe, make_stream_state)
from .multisystem import MultiStreamSystem, make_multistream_packed_step

__all__ = ["make_frame_step", "make_multistream_step", "make_scan_probe",
           "make_stream_state", "MultiStreamSystem",
           "make_multistream_packed_step"]
