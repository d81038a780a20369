from .proto import (ConfigError, check_cfg, check_consistency_with_proto,
                    check_field, expand_section, resolve_proto, strtobool)
from .schedule import expand_str_ep, newbob_update
from .dsl import ModelGraph, parse_model_field
from .experiment import (cfg_item2sec, create_configs, create_lists,
                         dict_fea_lab_arch, parse_fea_field, parse_lab_field,
                         read_args_command_line, split_chunks, compute_n_chunks)
