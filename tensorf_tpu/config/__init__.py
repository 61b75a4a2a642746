from .schema import TrainConfig, model_config_from
from .frontends import load_config, parse_txt_config, parse_cli
