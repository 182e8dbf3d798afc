#pragma once

#include <bez_geometry/point3.hpp>

// Rigid-body pose: position + xyzw quaternion. The reference's Pose3 is an
// empty subclass of ROS geometry_msgs::Pose (soccer_geometry/pose3.hpp);
// ours is self-contained and functional.

namespace bez {

struct Quaternion {
    float x = 0.0f, y = 0.0f, z = 0.0f, w = 1.0f;
};

struct Pose3 {
    Point3 position;
    Quaternion orientation;

    Pose3() = default;
    Pose3(const Point3& p, const Quaternion& q) : position(p), orientation(q) {}

    // Compose two poses (this * other).
    Pose3 compose(const Pose3& other) const;

    // Transform a point from the pose's local frame to the parent frame.
    Point3 transform(const Point3& p) const;

    Pose3 inverse() const;
};

}  // namespace bez
