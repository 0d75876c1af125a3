from gigapose_tpu.render.rasterizer import Rasterizer, render_template_views
