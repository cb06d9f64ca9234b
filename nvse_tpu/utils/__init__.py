from .config import AttrDict, load_config, build_env, save_config
