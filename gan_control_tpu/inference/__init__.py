"""L8 inference layer: Inference (generator loading + gen_batch),
Controller (explicit attribute control), ServingController (bucketed
fully-jitted controlled generation for serving loops), and the exported
StableHLO serving artifacts (model-code-free deployment)."""

from gan_control_tpu.inference.inference import Inference
from gan_control_tpu.inference.controller import Controller
from gan_control_tpu.inference.serving import (
    ExportedServing,
    ServingController,
    load_exported_serving,
)
