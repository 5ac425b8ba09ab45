from .build import YOLOModel, ModelSpec, build_model, parse_model_yaml  # noqa: F401
from . import modules  # noqa: F401
from . import heads  # noqa: F401
