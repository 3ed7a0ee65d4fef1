from pegasus_tpu.physics.rigid_body import (
    RigidBodyParams,
    RigidBodyState,
    simulate,
    step,
)
from pegasus_tpu.physics.engine import PhysicsEngine
