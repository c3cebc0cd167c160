// Headless stand-in for the reference's src/ui/_gtk_vars.h (GTK3 is not
// installed in this environment).  The reference's _panorama.h includes
// "_gtk_vars.h" only for `struct progress_bar_` (the UI<->worker progress
// contract, /root/reference/src/ui/_gtk_vars.h:17-58); everything else in
// that header is GTK widget plumbing the headless build never touches.
// This stub supplies just that struct with GTK types degraded to void*/
// char so the full pipeline (classes+math+system+max_flow+test) links
// without any UI code.
#pragma once
#include <atomic>
#include <cstring>

typedef unsigned int guint;
typedef char gchar;
typedef void GtkWidget;

#ifndef TRUE
#define TRUE true
#define FALSE false
#endif

struct viewer_window_;
struct main_window_;

struct progress_bar_ {
    guint bar_timer_id = 0;
    std::atomic<bool> finished{false};
    std::atomic<double> fraction{0};
    std::atomic<bool> thread_save{false};
    GtkWidget *window = nullptr;
    GtkWidget *pbar_main_vbox = nullptr;
    GtkWidget *pbar_progress_bar = nullptr;
    GtkWidget *pbar_button_box = nullptr;
    GtkWidget *pbar_button_box_cancel = nullptr;
    viewer_window_ *view = nullptr;
    main_window_ *main_window = nullptr;
    bool canceld = false;
    bool error = false;
    const gchar *what_error = nullptr;
    int test = 0;
    GtkWidget *instance = nullptr;
    gchar *loading_text = nullptr;

    void bar_text(const gchar *source) {
        delete[] loading_text;
        loading_text = nullptr;
        if (source) {
            loading_text = new char[std::strlen(source) + 1];
            std::strcpy(loading_text, source);
        }
    }
    void init() { bar_text(""); }
    void cleanup() { delete[] loading_text; }
};
