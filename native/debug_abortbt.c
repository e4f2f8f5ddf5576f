/* LD_PRELOAD shim: on SIGABRT, print a native backtrace to stderr.
 *
 * For hunting the rare native abort in full-suite runs (see
 * ARCHITECTURE.md "Suite-stability campaign"). Build + use:
 *   gcc -shared -fPIC -o abortbt.so native/debug_abortbt.c
 *   LD_PRELOAD=$PWD/abortbt.so python -m pytest tests/ -q
 * Note: do not combine with -X faulthandler (it replaces the SIGABRT
 * handler installed here).
 */
#define _GNU_SOURCE
#include <execinfo.h>
#include <signal.h>
#include <stdio.h>
#include <string.h>
#include <unistd.h>

static void handler(int sig) {
    void *bt[64];
    int n = backtrace(bt, 64);
    const char msg[] = "\n=== native SIGABRT backtrace ===\n";
    write(2, msg, sizeof(msg) - 1);
    backtrace_symbols_fd(bt, n, 2);
    signal(sig, SIG_DFL);
    raise(sig);
}

__attribute__((constructor)) static void setup(void) {
    struct sigaction sa;
    memset(&sa, 0, sizeof(sa));
    sa.sa_handler = handler;
    sa.sa_flags = SA_RESTART;
    sigaction(SIGABRT, &sa, NULL);
}
