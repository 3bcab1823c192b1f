"""Host-side IO: trajectory/map txt logs, OpenCV-XML calibration interop,
media ingest.  Formats are bit-compatible with the reference's
(src/misc/IOmisc.cpp) so trajectories can be compared file-to-file."""

from .logs import (
    GlobalData,
    LogStreams,
    format_matrix,
    load_global_data_from_logs,
    write_matrix,
)
from .media import MediaSource, natural_sort_paths
from .xmlio import load_matrix_from_xml, save_calib_parameters_to_xml, save_matrix_to_xml

__all__ = [
    "GlobalData",
    "LogStreams",
    "MediaSource",
    "format_matrix",
    "load_global_data_from_logs",
    "load_matrix_from_xml",
    "natural_sort_paths",
    "save_calib_parameters_to_xml",
    "save_matrix_to_xml",
    "write_matrix",
]
