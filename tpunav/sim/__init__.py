"""Built-in JAX simulators: diff-drive plant, landmark sensor, lidar.

Replaces the reference's Gazebo plugin, analysis node, and fake encoders
(SURVEY.md §2.8) with pure-JAX models usable inside jitted closed loops.
"""

from .landmark_sensor import (  # noqa: F401
    associate_known,
    landmark_measurements,
)
from .lidar import box_segments, scan_cylinders, scan_segments  # noqa: F401
