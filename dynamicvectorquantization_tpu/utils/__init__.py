from .instantiate import instantiate_from_config, get_obj_from_str  # noqa: F401
