#pragma once

// 2-D point primitive. TPU-era counterpart of the reference soccer_geometry
// C++ library (resources/library/geometry/include/soccer_geometry/point2.hpp).

namespace bez {

struct Point2 {
    float x = 0.0f;
    float y = 0.0f;

    Point2() = default;
    Point2(float x_, float y_) : x(x_), y(y_) {}

    float norm() const;

    static float distance(const Point2& a, const Point2& b);
};

}  // namespace bez
