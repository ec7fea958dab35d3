// Service worker for the bark-tpu browser demo: offline/caching parity with
// the reference wasm demo, which caches its model in IndexedDB so a reload
// works without re-downloading (/root/reference/examples/wasm/helpers.js:91-92).
// Here the MODEL lives server-side, so what must survive a reload without
// network is the app shell (cache-first below) and past generations (the
// page stores WAVs in IndexedDB — see index.html's history panel).
const CACHE = "bark-tpu-demo-v1";
const SHELL = ["/", "/sw.js"];

self.addEventListener("install", (e) => {
  e.waitUntil(
    caches.open(CACHE).then((c) => c.addAll(SHELL)).then(() => self.skipWaiting())
  );
});

self.addEventListener("activate", (e) => {
  e.waitUntil(
    caches.keys().then((keys) =>
      Promise.all(keys.filter((k) => k !== CACHE).map((k) => caches.delete(k)))
    ).then(() => self.clients.claim())
  );
});

self.addEventListener("fetch", (e) => {
  const url = new URL(e.request.url);
  // generation/progress/voices are live API calls — network only
  if (e.request.method !== "GET" ||
      ["/bark", "/progress", "/voices", "/health"].some(
        (p) => url.pathname.startsWith(p))) {
    return;
  }
  // app shell: cache-first with background refresh (stale-while-revalidate)
  e.respondWith(
    caches.match(e.request).then((hit) => {
      const refresh = fetch(e.request).then((resp) => {
        if (resp.ok) {
          const copy = resp.clone();
          caches.open(CACHE).then((c) => c.put(e.request, copy));
        }
        return resp;
      }).catch(() => hit);
      return hit || refresh;
    })
  );
});
