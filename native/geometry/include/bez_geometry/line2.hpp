#pragma once

// Infinite 2-D line in Hesse normal (rho, theta) form (reference parity:
// soccer_geometry/line2.hpp, completed with actual functionality).

namespace bez {

struct Point2;

struct Line2 {
    float rho = 0.0f;    // signed distance from origin
    float theta = 0.0f;  // normal direction angle

    Line2(float rho_, float theta_) : rho(rho_), theta(theta_) {}

    // Construct the line through two points.
    static Line2 through(const Point2& a, const Point2& b);

    // Perpendicular distance from a point to this line.
    float distance(const Point2& p) const;
};

}  // namespace bez
