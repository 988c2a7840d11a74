from .checkpoint import load_checkpoint, save_checkpoint  # noqa: F401
from .export import (  # noqa: F401
    export_aot_weights,
    load_tagged_binary,
    save_deployment_model,
    save_tagged_binary,
)
from .viz import depth2img  # noqa: F401
