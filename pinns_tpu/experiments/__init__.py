from pinns_tpu.experiments.presets import PRESETS, get_preset
