#pragma once

#include <bez_geometry/point2.hpp>

// 3-D point primitive (reference parity: soccer_geometry/point3.hpp).

namespace bez {

struct Point3 {
    float x = 0.0f;
    float y = 0.0f;
    float z = 0.0f;

    Point3() = default;
    Point3(float x_, float y_, float z_) : x(x_), y(y_), z(z_) {}

    float norm() const;

    static float distance(const Point3& a, const Point3& b);
};

}  // namespace bez
