#pragma once

#include <bez_geometry/point2.hpp>

// 2-D line segment (reference parity: soccer_geometry/segment2.hpp).

namespace bez {

struct Segment2 {
    Point2 p1;
    Point2 p2;

    Segment2(Point2 a, Point2 b) : p1(a), p2(b) {}

    // Slope dy/dx; +inf for vertical segments.
    float slope() const;

    float length() const;
};

}  // namespace bez
