package io.deeplake.spark.ext;

import java.util.List;
import java.util.Map;
import java.util.concurrent.ConcurrentHashMap;

/**
 * JVM-side registry: dataset data-path prefix -> column -> index entry.
 *
 * The Python side (deeplake_spark.plans.sqlrouting) populates this from a
 * Dataset's persisted index metadata; {@link IndexRoutingRule} consults it
 * when a Filter sits over a parquet relation whose root paths fall under a
 * registered prefix. Mirrors the reference's index_holder: every query is
 * given the chance to route through a registered index
 * (cpp/query_core/index_holder.hpp:18-43).
 */
public final class IndexRegistry {

    public static final class Entry {
        public final String kind;      // "inverted" | "numeric"
        public final String column;
        public final String indexPath; // directory holding postings/ or values/
        public final String idCol;     // row-id column of the BASE relation

        Entry(String kind, String column, String indexPath, String idCol) {
            this.kind = kind;
            this.column = column;
            this.indexPath = indexPath;
            this.idCol = idCol;
        }
    }

    private static final Map<String, Map<String, Entry>> BY_PREFIX =
            new ConcurrentHashMap<>();

    private IndexRegistry() {}

    public static void register(String tablePathPrefix, String column,
                                String kind, String indexPath, String idCol) {
        BY_PREFIX.computeIfAbsent(normalize(tablePathPrefix),
                        k -> new ConcurrentHashMap<>())
                .put(column, new Entry(kind, column, indexPath, idCol));
    }

    public static void unregister(String tablePathPrefix) {
        BY_PREFIX.remove(normalize(tablePathPrefix));
    }

    public static void clear() {
        BY_PREFIX.clear();
    }

    public static boolean isEmpty() {
        return BY_PREFIX.isEmpty();
    }

    public static int size() {
        return BY_PREFIX.size();
    }

    /** Registered prefix owning ALL of the given root paths (a multi-root
     *  scan mixing a registered dataset with an unregistered path must
     *  NOT route — the index semijoin would wrongly drop the unregistered
     *  rows). Prefixes match on PATH-SEGMENT boundaries only: /x/docs
     *  owns /x/docs and /x/docs/file.parquet, never the sibling
     *  /x/docs2. */
    static Map<String, Entry> lookupByPaths(List<String> rootPaths) {
        if (rootPaths.isEmpty()) {
            return null;
        }
        // LONGEST owning prefix wins, deterministically: with nested
        // registrations (/data and /data/docs) ConcurrentHashMap
        // iteration order used to decide which entry map served the
        // route — and the kindsForPaths soundness answer — per JVM
        // (r15 review). The most specific registration is the one
        // that describes the scanned dataset.
        Map<String, Entry> best = null;
        int bestLen = -1;
        for (Map.Entry<String, Map<String, Entry>> e : BY_PREFIX.entrySet()) {
            String k = e.getKey();
            String kSlash = k.endsWith("/") ? k : k + "/";
            boolean ownsAll = true;
            for (String p : rootPaths) {
                String n = normalize(p);
                if (!n.equals(k) && !n.startsWith(kSlash)) {
                    ownsAll = false;
                    break;
                }
            }
            if (ownsAll && k.length() > bestLen) {
                best = e.getValue();
                bestLen = k.length();
            }
        }
        return best;
    }

    /** Comma-joined "column=kind" pairs of the registry entry owning ALL
     *  of the given paths, "" when none. Python-side introspection hook:
     *  sqlrouting._hybrid_fetch_ranges asks whether a clustered/pq
     *  registration covers a view's files — if one does, the statement's
     *  __vl lane can ANN-route at execution and become approximate, so
     *  build-time exact-mirror fetch-back ranges would not be a sound
     *  superset of the executed winners. */
    public static String kindsForPaths(List<String> rootPaths) {
        Map<String, Entry> m = lookupByPaths(rootPaths);
        if (m == null) {
            return "";
        }
        StringBuilder sb = new StringBuilder();
        for (Entry e : m.values()) {
            if (sb.length() > 0) {
                sb.append(',');
            }
            sb.append(e.column).append('=').append(e.kind);
        }
        return sb.toString();
    }

    /** file:/x, file:///x and /x all normalize to /x; trailing slashes
     *  strip ("/x/docs/" == "/x/docs" — a trailing-slash registration
     *  could otherwise never own its own dataset's paths and routing
     *  silently disengaged, r15 review). */
    static String normalize(String p) {
        String s = p;
        if (s.startsWith("file:")) {
            s = s.substring(5);
            while (s.startsWith("//")) {
                s = s.substring(1);
            }
        }
        while (s.length() > 1 && s.endsWith("/")) {
            s = s.substring(0, s.length() - 1);
        }
        return s;
    }
}
