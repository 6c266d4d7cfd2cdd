from .camera import (  # noqa: F401
    FOLLOW_POSITION,
    FOLLOW_TRANSFORM,
    CameraSensor,
    look_at_quat,
    proj_matrix,
    view_matrix,
    world_to_pixel,
)
