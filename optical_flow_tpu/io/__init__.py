from optical_flow_tpu.io.flo import read_flo, write_flo, read_flow_file

__all__ = ["read_flo", "write_flo", "read_flow_file"]
