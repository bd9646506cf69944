from .registry import resolve_target, TARGET_ALIASES  # noqa: F401
from .yaml_config import load_config, merge_configs, apply_dotlist  # noqa: F401
