#pragma once

#include <bez_geometry/point3.hpp>

#include <vector>

// 3-D line segment with resampling (reference parity:
// soccer_geometry/segment3.hpp).

namespace bez {

struct Segment3 {
    Point3 p1;
    Point3 p2;

    Segment3(Point3 a, Point3 b) : p1(a), p2(b) {}

    float length() const;

    // Evenly spaced points from p1 to p2 inclusive, floor(length/spacing)+1
    // samples; degenerate spacing returns just the endpoints.
    std::vector<Point3> getSpacedPoints(float spacing) const;
};

}  // namespace bez
