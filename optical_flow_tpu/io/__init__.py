from optical_flow_tpu.io.flo import read_flo, write_flo, read_flow_file
from optical_flow_tpu.io.png import read_png

__all__ = ["read_flo", "write_flo", "read_flow_file", "read_png"]
