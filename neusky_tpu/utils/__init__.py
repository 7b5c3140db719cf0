from neusky_tpu.utils.profiling import time_function, profiler_summary, trace_context
from neusky_tpu.utils.viz import apply_depth_colormap, apply_colormap, image_grid
