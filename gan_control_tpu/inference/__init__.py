"""L8 inference layer: Inference (generator loading + gen_batch) and
Controller (explicit attribute control)."""

from gan_control_tpu.inference.inference import Inference
from gan_control_tpu.inference.controller import Controller
