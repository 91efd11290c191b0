from rspc_tpu.viz.render import ViewState, render_cloud, render_to_png  # noqa: F401
