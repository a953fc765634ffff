"""Distillation framework (L3): losses, projectors, teacher wrapper, preflight."""

from imagecaptioner_tpu.distill.losses import (  # noqa: F401
    distillation_loss, optimized_distillation_loss)
from imagecaptioner_tpu.distill.projector import (  # noqa: F401
    feature_projector_init, feature_projector_apply, create_feature_projectors)
from imagecaptioner_tpu.distill.wrapper import teacher_forward_for_kd  # noqa: F401
from imagecaptioner_tpu.distill.validate import validate_distillation_setup  # noqa: F401
