from .ate import ate_rmse, align_umeyama  # noqa: F401
