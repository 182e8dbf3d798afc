#pragma once

// Minimal gtest-compatible test harness (TEST / ASSERT_* / RUN_ALL_TESTS).
// The image ships no gtest; this keeps the C++ suites dependency-free while
// mirroring the reference's gtest structure
// (resources/library/geometry/tests/soccer_geometry/test_geometry.cpp).

#include <cmath>
#include <cstdio>
#include <functional>
#include <string>
#include <vector>

namespace minitest {

struct Case {
    std::string name;
    std::function<void()> fn;
};

inline std::vector<Case>& registry() {
    static std::vector<Case> cases;
    return cases;
}

inline int& failures() {
    static int f = 0;
    return f;
}

struct Registrar {
    Registrar(const std::string& name, std::function<void()> fn) {
        registry().push_back({name, std::move(fn)});
    }
};

inline int run_all() {
    int failed_cases = 0;
    for (const auto& c : registry()) {
        const int before = failures();
        c.fn();
        const bool ok = failures() == before;
        std::printf("[%s] %s\n", ok ? " OK " : "FAIL", c.name.c_str());
        if (!ok) ++failed_cases;
    }
    std::printf("%zu tests, %d failed\n", registry().size(), failed_cases);
    return failed_cases == 0 ? 0 : 1;
}

}  // namespace minitest

#define TEST(suite, name)                                                   \
    static void suite##_##name##_impl();                                    \
    static minitest::Registrar suite##_##name##_reg(#suite "." #name,       \
                                                    suite##_##name##_impl); \
    static void suite##_##name##_impl()

#define MT_CHECK(cond, msg)                                              \
    do {                                                                 \
        if (!(cond)) {                                                   \
            std::printf("  assertion failed at %s:%d: %s\n", __FILE__,   \
                        __LINE__, msg);                                  \
            ++minitest::failures();                                      \
            return;                                                      \
        }                                                                \
    } while (0)

#define ASSERT_TRUE(c) MT_CHECK((c), #c)
#define ASSERT_FALSE(c) MT_CHECK(!(c), "!" #c)
#define ASSERT_EQ(a, b) MT_CHECK((a) == (b), #a " == " #b)
#define ASSERT_NEAR(a, b, tol) \
    MT_CHECK(std::fabs((a) - (b)) <= (tol), #a " ~= " #b)
#define ASSERT_FLOAT_EQ(a, b)                                       \
    MT_CHECK(std::fabs((a) - (b)) <=                                \
                 4.0f * 1.1920929e-7f *                             \
                     (std::fabs((float)(a)) > std::fabs((float)(b)) \
                          ? std::fabs((float)(a))                   \
                          : std::fabs((float)(b))) +                \
             1e-6f,                                                 \
             #a " == " #b)

#define RUN_ALL_TESTS() minitest::run_all()
