from humanrf_tpu.models.humanrf import HumanRFConfig, HumanRFModel, QueryInput, QueryOutput
