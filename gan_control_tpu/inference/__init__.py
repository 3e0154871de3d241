"""L8 inference layer: Inference (generator loading + gen_batch),
Controller (explicit attribute control), and ServingController (bucketed
fully-jitted controlled generation for serving loops)."""

from gan_control_tpu.inference.inference import Inference
from gan_control_tpu.inference.controller import Controller
from gan_control_tpu.inference.serving import ServingController
