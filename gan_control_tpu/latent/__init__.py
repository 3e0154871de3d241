from gan_control_tpu.latent.groups import (
    LatentGroup,
    GroupSpec,
    re_arrange_z,
    re_arrange_inject_noise,
    same_not_same_split,
    insert_group_latent,
    extract_group_latent,
)

__all__ = [
    "LatentGroup",
    "GroupSpec",
    "re_arrange_z",
    "re_arrange_inject_noise",
    "same_not_same_split",
    "insert_group_latent",
    "extract_group_latent",
]
