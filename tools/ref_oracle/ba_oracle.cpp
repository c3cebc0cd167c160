// Bundle-adjustment parity oracle: compiles the REFERENCE's own BA stack
// (/root/reference/src/math/_stitch.cpp, _bundle_adjust_{tools,main,fast}
// .cpp, _img_manipulation.cpp, _homography.cpp, _util.cpp — unmodified,
// via include path) into a headless harness that reproduces
// pan::panorama::stitch_panorama up to the BA stage
// (_panorama.cpp:440-520) and dumps per-camera rotations and intrinsics
// — the values tests/test_ba_parity.py gates against (the north star's
// "rotation/focal agreement within the reference's BA convergence
// bound"; the bound itself comes from running this oracle repeatedly:
// util::randomN seeds RANSAC from std::random_device, so every run
// measures the reference's own convergence spread).
//
// Build & run:  bash tools/ref_oracle/build_ba_oracle.sh [seq] [fast]
//
// No reference code is copied into this repository; the reference tree
// is referenced at build time only, to produce oracle NUMBERS.

#include <cstdio>
#include <vector>
#include <string>
#include <opencv2/opencv.hpp>
#include "_homography.h"
#include "_stitch.h"
#include "_img_manipulation.h"

int main(int argc, char** argv) {
    std::string seq = argc > 1 ? argv[1] : "map";
    bool fast = argc > 2 ? std::atoi(argv[2]) != 0 : false;
    int init_size = argc > 3 ? std::atoi(argv[3]) : 700;

    std::string pattern = seq == "map"
        ? "/root/reference/results/map/budapest*.jpg"
        : "/root/reference/results/" + seq + "/resized*.jpg";
    std::vector<std::string> paths;
    cv::glob(pattern, paths);
    std::sort(paths.begin(), paths.end());

    std::vector<cv::Mat> imgs;
    for (auto& p : paths) {
        cv::Mat im = cv::imread(p);
        // images::load_resized rules (_image.cpp:29-73)
        if (std::max(im.rows, im.cols) > init_size) {
            double s;
            if (im.cols >= im.rows) s = double(init_size) / im.cols;
            else s = double(init_size) / im.rows;
            cv::resize(im, im, cv::Size(), s, s, cv::INTER_AREA);
        }
        imgs.push_back(im);
    }
    int n = imgs.size();
    fprintf(stderr, "loaded %d images (%s)\n", n, seq.c_str());

    // pan::config defaults (_panorama.h:80-125)
    util::match_conf conf;
    conf.max_images_per_match = 5;
    conf.RANSAC_iterations = 1500;
    conf.max_keypoints = 250;
    conf.x_margin = 4;
    conf.min_overlap = .15f;
    conf.overlap_inl_match = .1f;
    conf.overlap_inl_keyp = .005f;
    conf.conf = .025f;
    conf.nfeatures = 0;
    conf.nOctaveLayers = 4;
    conf.contrastThreshold = 3e-2;
    conf.edgeThreshold = 6;
    conf.sigma_sift = 1.4142;

    std::vector<int> idx(n);
    for (int i = 0; i < n; i++) idx[i] = i;
    std::vector<util::keypoints> kps =
        util::extrace_kp_vector(imgs, idx, &conf);

    // matching exactly as panorama::get_adj_par (_panorama.cpp:385-436)
    int threads = 8;
    util::adj_calculator calc(imgs, kps, &conf, NULL, NULL);
    calc.get_threads(threads);
    {
        std::vector<std::thread> tv;
        for (int i = 0; i < threads; i++)
            tv.emplace_back(&util::adj_calculator::get_match_number_matrix,
                            &calc, i);
        for (auto& t : tv) t.join();
    }
    calc.heuristic_match_filter(conf.max_images_per_match);
    {
        std::vector<std::thread> tv;
        for (int i = 0; i < threads; i++)
            tv.emplace_back(&util::adj_calculator::cal_adj, &calc, imgs, i);
        for (auto& t : tv) t.join();
    }

    // components / focal / flat-transform prep (_panorama.cpp:489-509)
    std::vector<struct util::adj_str> adj_string =
        util::extract_adj(calc.adj);
    imgm::pan_img_transform Tr(&adj_string[0], &imgs);
    Tr.focal = util::focal_from_hom(calc.hom_mat, adj_string[0].adj);
    if (Tr.focal == -1) Tr.focal = 700;
    double focal_est = Tr.focal;
    imgm::calc_stitch_from_adj(Tr, calc.hom_mat, calc.match_mat, kps);
    Tr.fast = fast;

    struct stch::stitch_result res = stch::bundleadjust_stitching(
        Tr, calc.hom_mat, kps, calc.match_mat, .05f, threads, NULL, NULL);

    printf("{\n\"seq\": \"%s\", \"fast\": %d,\n", seq.c_str(), (int)fast);
    printf("\"focal_est\": %.4f,\n", focal_est);
    printf("\"maxLoc\": %d,\n", res.maxLoc);
    printf("\"ord\": [");
    for (size_t i = 0; i < res.ord.size(); i++)
        printf("%s%d", i ? ", " : "", res.ord[i]);
    printf("],\n\"connectivity\": [");
    for (size_t i = 0; i < res.connectivity.size(); i++)
        printf("%s%.3f", i ? ", " : "", res.connectivity[i]);
    // per-camera K: focal, aspect (K(1,1)), principal point
    // (post-BA, centers shifted by half image size, _stitch.cpp:303-307)
    printf("],\n\"K\": [");
    for (size_t i = 0; i < res.K.size(); i++) {
        const Eigen::MatrixXd& K = res.K[i];
        printf("%s[%.6f, %.6f, %.6f, %.6f]", i ? ", " : "",
               K(0, 0), K(1, 1), K(0, 2), K(1, 2));
    }
    printf("],\n\"R\": [");
    for (size_t i = 0; i < res.rot.size(); i++) {
        const Eigen::MatrixXd& R = res.rot[i];
        printf("%s[", i ? ", " : "");
        for (int r = 0; r < 3; r++)
            for (int c = 0; c < 3; c++)
                printf("%s%.8f", (r || c) ? ", " : "", R(r, c));
        printf("]");
    }
    printf("]\n}\n");
    return 0;
}
