from optical_flow_tpu.viz.flow_color import flow_to_color, make_colorwheel, compute_color
from optical_flow_tpu.viz.plot_flow import plot_flow

__all__ = ["flow_to_color", "make_colorwheel", "compute_color", "plot_flow"]
